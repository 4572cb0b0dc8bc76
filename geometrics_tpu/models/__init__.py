"""Model zoo: every network the reference defines, rebuilt TPU-first.

Reference inventory (SURVEY.md §2.1): CNN image encoder + perceptual pooling
(#7), GCN deformation blocks (#8), MeshEncoder (#9), VoxelDecoder (#10), and
the composed single-image reconstruction model (#12).
"""

from .gcn import GCNDeformationBlock, GraphConv, MeshEncoder
from .geometrics import BlockOutput, GEOMetricsModel, GEOMetricsOutput
from .image_encoder import ImageEncoder
from .perceptual_pooling import (
    Camera,
    DEFAULT_FOV_DEG,
    bilinear_sample,
    camera_rotation,
    perceptual_pool,
    project_vertices,
)
from .voxel_decoder import VoxelDecoder, voxel_bce_loss, voxel_iou

__all__ = [
    "BlockOutput",
    "Camera",
    "DEFAULT_FOV_DEG",
    "GCNDeformationBlock",
    "GEOMetricsModel",
    "GEOMetricsOutput",
    "GraphConv",
    "ImageEncoder",
    "MeshEncoder",
    "VoxelDecoder",
    "bilinear_sample",
    "camera_rotation",
    "perceptual_pool",
    "project_vertices",
    "voxel_bce_loss",
    "voxel_iou",
]
