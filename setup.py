"""Build driver: Python package + the native host-ops library.

Counterpart of the reference's CMake-driving ``setup.py`` (reference
``setup.py:86-171``): the native piece here is ``native/hostops.cpp``
(CPU baseline/fallback kernels), built with ``make`` and shipped next
to the package.  The TPU compute path needs no native build — it is
JAX/XLA/Pallas.
"""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        native = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
        try:
            subprocess.run(["make", "-C", native], check=True)
        except Exception as exc:  # native lib is optional (baseline/fallback)
            print(f"warning: native hostops build skipped: {exc}")
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
