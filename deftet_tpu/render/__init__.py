"""2D-supervision rendering stack (reference: diff_render/diftet_6_subdiv).

* camera     — pixel2mesh-style perspective transform (3_model/cameraop.py).
* raster     — depth-peeled differentiable tet-face rasterizer, the
               TPU-native equivalent of kaolin's ``deftet_sparse_render``
               CUDA kernel (5_rendereq/deftetrneder.py:97-100).
* composite  — alpha compositing over peeled layers + white background
               (``peel2mask``, deftetrneder.py:31-64).
* scene      — optimizable tet scene: vertex offsets + RGBA features,
               carving, subdivision (3_model/deftet.py).
"""

from .camera import perspective, pose_spherical, camera_from_blender
from .raster import deftet_sparse_render
from .composite import peel2mask, render_mesh_color
from .scene import TetScene, build_render_faces

__all__ = [
    "perspective",
    "pose_spherical",
    "camera_from_blender",
    "deftet_sparse_render",
    "peel2mask",
    "render_mesh_color",
    "TetScene",
    "build_render_faces",
]
