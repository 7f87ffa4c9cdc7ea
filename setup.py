"""Build configuration for the optional native extension.

`python setup.py build_ext --inplace` (or `make native`) compiles
native/pls_native.cpp into pls_tpu/_native.*.so.  The package works
without it (pure-Python fallbacks in utils/io.py and utils/gcc_rng.py).
"""

import numpy as np
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "pls_tpu._native",
            sources=["native/pls_native.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-std=c++17", "-O2"],
            language="c++",
        )
    ]
)
