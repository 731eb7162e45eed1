"""Native host runtime: C++ components on the host side of the serving
path (device kernels stay JAX/Pallas; see runtime/native.py)."""
