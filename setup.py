"""Build hook: compile the native preprocessor into the package (best-effort).

All metadata lives in pyproject.toml; this file exists only to compile
native/preprocess.cc into
indirect_learning_pose_shape_tpu/data/libilps_preprocess.so at build time so
wheels and installed trees carry it. The library is an optional fast path —
data/native_preprocess.py falls back to a bit-matched numpy implementation —
so a missing C++ toolchain downgrades the build instead of failing it.
"""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildPyWithNative(build_py):
    def run(self):
        root = os.path.dirname(os.path.abspath(__file__))
        native = os.path.join(root, "native")
        so = os.path.join(native, "libilps_preprocess.so")
        try:
            subprocess.run(
                ["make", "-C", native], check=True, capture_output=True, timeout=300
            )
        except Exception as e:  # no toolchain: ship without the fast path
            print(f"native preprocessor not built ({e}); numpy fallback will be used")
        if os.path.exists(so):
            dest = os.path.join(
                root, "indirect_learning_pose_shape_tpu", "data",
                "libilps_preprocess.so",
            )
            with open(so, "rb") as fin, open(dest, "wb") as fout:
                fout.write(fin.read())
        super().run()


setup(cmdclass={"build_py": BuildPyWithNative})
