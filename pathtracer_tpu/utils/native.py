"""ctypes bridge to the native C++ runtime library (scene parsing, image
encoding).  Falls back cleanly when the shared library is not built."""

def available() -> bool:
    return False
