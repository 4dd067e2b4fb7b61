from .dispatch import (  # noqa: F401
    ShadingParams, apply_textures, bxdf_sample, bxdf_eval, bxdf_pdf,
    resolve_material)
