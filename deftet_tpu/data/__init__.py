"""Datasets and offline preprocessing.

The reference trains on ShapeNet V1 via kaolin readers with GPU-side
watertighting inside DataLoader workers (dataloader.py:16-115).  Here the
preprocessing is an *offline* host pass producing npz shards (surface point
clouds, SDF samples, padded meshes) — no accelerator work in the input
pipeline — and, since ShapeNet cannot be redistributed, a procedural
watertight shape family provides a self-contained default dataset with the
same record schema.
"""

from .shapes import (
    icosphere,
    make_blob,
    make_box,
    make_ellipsoid,
    make_torus,
    normalize_mesh,
    random_shape,
    shape_family,
)
from .pipeline import (
    sample_surface,
    mesh_sdf_points,
    make_example,
    build_dataset,
    build_dataset_from_meshes,
    ShapeDataset,
    batch_iterator,
)

__all__ = [
    "icosphere",
    "make_blob",
    "make_box",
    "make_ellipsoid",
    "make_torus",
    "normalize_mesh",
    "random_shape",
    "shape_family",
    "sample_surface",
    "mesh_sdf_points",
    "make_example",
    "build_dataset",
    "build_dataset_from_meshes",
    "ShapeDataset",
    "batch_iterator",
]
