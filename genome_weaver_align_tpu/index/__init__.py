from . import build, device_build, files, kmer, multi, native, sais, wavelet  # noqa: F401
