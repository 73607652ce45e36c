from cmdiad_tpu.methods.registry import build_method  # noqa: F401
