"""stratanet2_tpu — a TPU-native (JAX/XLA/Pallas) framework for weakly-supervised
vegetation-coverage mapping from airborne LiDAR point clouds.

Re-designed from scratch with the capabilities of the PyTorch/CUDA reference
(IGNF/StrataNet2-Vegetation-Coverage-Maps): a PointNet2-style segmentation
backbone over fixed-size padded point clouds, in-graph scatter-max raster
projection, KDE-mixture strata-likelihood regularization, cross-validated
training, and parcel-scale tiled inference with weighted GeoTIFF mosaicking.

Everything on the device compute path is static-shape and jit-compiled;
batch-axis data parallelism is expressed with `jax.sharding` over a Mesh.
"""

__version__ = "0.1.0"
