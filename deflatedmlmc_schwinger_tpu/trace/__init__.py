from deflatedmlmc_schwinger_tpu.trace.hutchinson import hutchinson  # noqa: F401

try:  # mlmc lands after hutchinson in the build order
    from deflatedmlmc_schwinger_tpu.trace.mlmc import mlmc  # noqa: F401
except ImportError:  # pragma: no cover
    pass
