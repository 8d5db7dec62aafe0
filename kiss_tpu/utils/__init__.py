from kiss_tpu.utils import codec, fasta, serializer, timing  # noqa: F401
