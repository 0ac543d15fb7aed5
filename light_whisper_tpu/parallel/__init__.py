from light_whisper_tpu.parallel.mesh import make_mesh
from light_whisper_tpu.parallel.pipeline import make_pp_mesh

__all__ = ["make_mesh", "make_pp_mesh"]
