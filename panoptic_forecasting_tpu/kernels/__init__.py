"""Production TPU kernels — every module here is a shipping path.

zbuffer (sort + Pallas placement z-buffer splat), placement (the
sorted-run min-canvas Pallas kernel), stem (fused one-hot + base_0 conv
for the bg model), mask_paste (matmul-form bilinear paste + depth
composite). Research kernels with measured-negative outcomes live under
``kernels.experimental`` and are imported by nothing in the pipeline.
"""

from .zbuffer import zbuffer_splat, splat_four_neighbors
from .mask_paste import paste_mask_bilinear, paste_and_composite
