"""Native shared libraries built by setup.py (build_ext)."""
