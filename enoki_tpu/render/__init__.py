"""enoki_tpu.render -- the differentiable renderer (north-star workload)."""

from .vec import Vec2, Vec3, dot3, cross3, norm3, normalize3  # noqa: F401
from .sphere import (  # noqa: F401
    Ray, SphereScene, make_rays, intersect_rays, shade_hits, combined,
    pixel_grid, render_fused, render_staged, image_loss, render_and_grads,
    numpy_reference,
)
from .sdf import (  # noqa: F401
    SDFScene, sdf, march, normal_at, shade, render_sdf, render_sdf_grads,
)
from . import sdflib  # noqa: F401
from .generic import make_sdf_renderer  # noqa: F401
