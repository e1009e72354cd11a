from .filters import (  # noqa: F401
    spatial_filter, laplacian_filter, median_filter, valid_depth_mask,
)
from .pointcloud import (  # noqa: F401
    depth_to_points, render_pointcloud, render_coverage,
    render_coverage_fast, degrid,
)
from .inpaint_fill import push_pull_fill, jitter_refine  # noqa: F401
from .discfill import fill_disocclusion, fill_disocclusion_fast  # noqa: F401
from .discfill3 import fill_disocclusion_fast3  # noqa: F401
from .bokeh import bokeh_blur, bokeh_pass, bokeh_weight_field  # noqa: F401
from .camera import (  # noqa: F401
    DepthRange, depth_range, compute_shift, shift_points, autozoom,
)
