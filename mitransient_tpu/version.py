"""Version info (parity role of reference version.py)."""

__version__ = "0.1.0"

# Capability target: feature parity with mitransient 1.3.0
# (/root/reference/mitransient/version.py:2).
TARGET_REFERENCE_VERSION = "1.3.0"
