from raytracingtest_tpu.models.renderers import (  # noqa: F401
    SurfaceRenderer, VolumetricRenderer, InverseRenderer,
)
