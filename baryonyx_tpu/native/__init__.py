"""Native (C++) runtime components with pure-Python fallbacks.

The reference is a C++ framework end to end; here the TPU compute path is
JAX/XLA and the host-side hot paths (the LP tokenizer/parser, reference:
lib/src/parser.cpp) have native implementations bound via ctypes. The
shared library builds on demand with the system toolchain and caches next
to the sources; if no compiler is available everything falls back to the
Python implementations.
"""

from baryonyx_tpu.native.build import load_library, native_available
from baryonyx_tpu.native.lp import parse_lp_native
