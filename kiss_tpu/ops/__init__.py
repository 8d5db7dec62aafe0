from kiss_tpu.ops import pack, suffix_sort  # noqa: F401
