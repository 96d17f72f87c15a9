"""Native (C++) runtime components, driven through ctypes."""

from sicnav_tpu.native.orca_cpp import orca_step_native, native_available  # noqa: F401
