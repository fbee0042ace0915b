"""Build the native scan-log codec as a proper setuptools extension.

``pip install .`` / ``python setup.py build_ext --inplace`` compiles
``csrc/scanlog.cc`` into ``tpuslam/_native/libtslg.so`` — a plain shared
library loaded via ctypes (no Python C API), replacing the lazy g++
fallback in ``tpuslam/io/bag.py`` (which remains for source checkouts
without a build step)."""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class CTypesExtension(Extension):
    """A shared library consumed through ctypes, not a Python module."""


class build_ctypes_ext(build_ext):
    def get_export_symbols(self, ext):
        if isinstance(ext, CTypesExtension):
            return ext.export_symbols  # don't require PyInit_*
        return super().get_export_symbols(ext)

    def get_ext_filename(self, ext_name):
        if ext_name.rpartition(".")[2].startswith("libtslg"):
            return ext_name.replace(".", "/") + ".so"
        return super().get_ext_filename(ext_name)


setup(
    ext_modules=[
        CTypesExtension(
            "tpuslam._native.libtslg",
            sources=["csrc/scanlog.cc"],
            extra_compile_args=["-O2"],
        )
    ],
    cmdclass={"build_ext": build_ctypes_ext},
)
