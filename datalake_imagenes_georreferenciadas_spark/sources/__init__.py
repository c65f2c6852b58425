"""Sources & sinks: binaryFile multimodal scans, file readers/writers, and
the content-addressed blob sink (SURVEY §2.1)."""
