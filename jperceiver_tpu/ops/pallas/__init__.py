from .maxpool import max_pool_5x5_s1, HAVE_PALLAS_TPU
