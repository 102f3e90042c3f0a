"""Native (C++) components, loaded via ctypes."""
