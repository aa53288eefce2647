"""tpu-nucleoatac: a TPU-native nucleosome-calling engine.

A from-scratch rebuild of the capabilities of GreenleafLab/NucleoATAC
(Schep et al., Genome Research 2015) designed for TPU hardware:
batched JAX/Pallas kernels over fixed-shape peak-window tensors, a C++
BAM/BGZF ingest layer, and shard_map data parallelism over a device mesh.

Numerical contract: DESIGN.md. Reference structure: SURVEY.md.
"""

__version__ = "0.1.0"
