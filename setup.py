from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "opv_tpu.runtime._iqio",
            sources=["opv_tpu/runtime/iqio.c"],
            extra_compile_args=["-O3"],
            optional=True,   # pure-python/numpy fallback exists
        )
    ]
)
