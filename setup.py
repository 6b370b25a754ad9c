from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "opv_tpu.runtime._iqio",
            sources=["opv_tpu/runtime/iqio.c"],
            extra_compile_args=["-O3"],
            optional=True,   # pure-python/numpy fallback exists
        ),
        Extension(
            "opv_tpu.runtime._tracking",
            sources=["opv_tpu/runtime/tracking.c"],
            extra_compile_args=["-O3"],
            optional=True,   # the JAX scan path is the fallback
        ),
    ]
)
