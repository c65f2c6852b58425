"""Headline query plans shared by the driver entry point, tests, and bench."""
