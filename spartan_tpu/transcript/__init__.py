"""transcript subpackage."""
