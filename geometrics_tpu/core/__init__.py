"""Mesh/graph numerical core (reference L1, SURVEY.md §1): padded MeshBuffer,
.obj I/O, adjacency aggregation, differentiable sampling, Chamfer/F1,
regularizers, masked adaptive splitting."""

from .adjacency import (
    aggregate_neighbors,
    aggregate_neighbors_batched,
    aggregate_neighbors_dense,
    dense_adjacency,
    face_edges,
    normalized_adjacency_dense,
    normalized_adjacency_dense_batched,
    vertex_degrees,
)
from .chamfer import chamfer_distance, f1_score, nearest_sqdists, pairwise_sqdist
from .losses import (
    edge_length_loss,
    laplacian_loss,
    laplacian_move_loss,
    latent_loss,
    umbrella_laplacian,
)
from .mesh import (
    MeshBuffer,
    face_normals_areas,
    gather_face_verts,
    icosphere_np,
    load_obj_np,
    make_mesh_buffer,
    save_mesh_buffer_sample,
    save_obj_np,
)
from .sampling import sample_surface, sample_surface_batched
from .splitting import (
    SplitResult,
    face_curvature_scores,
    face_curvature_scores_batched,
    split_mesh_buffer,
    split_topk_faces,
)

__all__ = [
    "MeshBuffer",
    "SplitResult",
    "aggregate_neighbors",
    "aggregate_neighbors_batched",
    "chamfer_distance",
    "dense_adjacency",
    "edge_length_loss",
    "f1_score",
    "face_curvature_scores",
    "face_curvature_scores_batched",
    "face_edges",
    "face_normals_areas",
    "gather_face_verts",
    "icosphere_np",
    "laplacian_loss",
    "laplacian_move_loss",
    "latent_loss",
    "load_obj_np",
    "make_mesh_buffer",
    "nearest_sqdists",
    "pairwise_sqdist",
    "sample_surface",
    "sample_surface_batched",
    "save_mesh_buffer_sample",
    "save_obj_np",
    "split_mesh_buffer",
    "split_topk_faces",
    "umbrella_laplacian",
    "vertex_degrees",
]
