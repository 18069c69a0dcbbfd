from styletts2_tpu.models.build import Models, build_models, init_params  # noqa: F401
