"""Rendering: static-shape mesh banks, JAX rasterizer, Phong shading."""
from .mesh import (  # noqa: F401
    MeshBank,
    build_mesh_bank,
    load_mesh_dir,
    load_mesh_file,
    make_test_meshes,
)
from .rasterizer import (  # noqa: F401
    interpolate_face_attributes,
    project_vertices,
    rasterize,
)
from .shading import PhongParams, phong_shade  # noqa: F401
from .renderer import Renderer  # noqa: F401
