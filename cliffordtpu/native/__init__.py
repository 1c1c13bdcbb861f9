"""Native (C++) runtime components, built on demand with the system
toolchain and loaded over a plain C ABI via ctypes.  See
`dataio.cc` (host input pipeline) and `build.py` (cached g++ build).
"""
