"""Native (C++) host runtime components, loaded via ctypes.

The shared library is compiled on first use (g++ -O3) and cached next to the
sources; every entry point has a pure-numpy fallback so the framework works
without a toolchain.
"""

from .build import get_lib, have_native  # noqa
from .batch import fast_build_batches  # noqa
