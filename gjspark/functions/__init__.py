"""Pure-numpy kernels (CRS, S2, H3-style hex index, PIP, codecs, hashes)
plus their Spark pandas-UDF wrappers. Everything here is vectorized —
no per-row Python in the hot path."""
