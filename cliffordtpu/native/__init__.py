"""Native (C++17) runtime components, built on demand with the system
toolchain over a plain C ABI (no pybind11):

- ``dataio.cc`` — host input pipeline: idx/gz parsing + prefetching
  batch assembler (ctypes bindings in ``cliffordtpu/data/native.py``).
- ``pjrt_serve.cc`` — PJRT serving host executing exported StableHLO
  bundles against any PJRT plugin, no Python in the serving process.
- ``pjrt_mock_plugin.cc`` — mock PJRT plugin for hermetic contract
  tests of the host (tests/test_pjrt_host.py).

``build.py`` compiles and caches all targets; a missing toolchain or
header degrades gracefully (callers fall back to pure-Python paths).
"""
