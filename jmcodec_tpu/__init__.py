"""jmcodec_tpu — TPU-native video codec framework (JAX/XLA/Pallas).

From-scratch rebuild of the capabilities of mojing1999/jmcodec (a Windows
wrapper over Intel QSV / NVIDIA NVDEC-NVENC): H.264/HEVC decode, encode and
transcode — but with the full codec math implemented as JAX/Pallas kernels and
a host C++ entropy front-end, scaled over TPU meshes instead of vendor ASICs.
"""

__version__ = "0.1.0"
