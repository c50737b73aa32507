"""Offline data preparation (L0): raw KITTI-360 -> cells/poses.

TPU-framework rebuild of /root/reference/datapreparation/kitti360pose/:
PLY ingestion, per-instance object extraction with voxel downsampling, cell
construction (bbox crop + DBSCAN pseudo-instances for stuff classes), pose
description via selection strategies, grounding to best cells, and the PMC
neighbor maps. No open3d/plyfile dependencies: the PLY reader and voxel grid
are implemented here (with a native C++ fast path in text2loc_tpu/native).
"""
