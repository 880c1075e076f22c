from raytracingtest_tpu.models.renderers import (  # noqa: F401
    SurfaceRenderer, VolumetricRenderer, InverseRenderer,
)
from raytracingtest_tpu.models.streaming import (  # noqa: F401
    StreamingRenderer,
)
