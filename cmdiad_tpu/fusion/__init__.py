from cmdiad_tpu.fusion.ocsvm import SGDOneClassSVM  # noqa: F401
