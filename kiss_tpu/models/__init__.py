from kiss_tpu.models.fm_index import FMIndex  # noqa: F401
