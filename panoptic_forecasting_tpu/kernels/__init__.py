from .zbuffer import zbuffer_splat, splat_four_neighbors
from .mask_paste import paste_mask_bilinear, paste_and_composite
