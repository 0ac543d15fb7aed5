from light_whisper_tpu.parallel.mesh import make_mesh

__all__ = ["make_mesh"]
