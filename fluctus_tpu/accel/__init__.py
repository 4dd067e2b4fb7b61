from .bvh import BVHArrays, build_bvh, export_bvh, import_bvh, SplitMode  # noqa: F401
