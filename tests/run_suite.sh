#!/bin/sh
# Full test suite, split into process chunks.
#
# Why chunks: the XLA CPU backend compiles each wavefront-kernel geometry
# into a multi-GB executable over several minutes; one pytest process
# accumulating every kernel eventually aborts inside the compiler
# (observed SIGABRT/SIGSEGV in backend_compile_and_load on this image).
# Isolating the device-heavy files into separate processes keeps each
# process's compiler footprint bounded. Run: sh tests/run_suite.sh
set -x
cd "$(dirname "$0")/.."
FAILED=0
run() { python -m pytest "$@" -q || FAILED=1; }

# host-side codec + API tests (no big device kernels)
run tests/ --ignore=tests/test_device_recon.py \
           --ignore=tests/test_hevc_batch_split.py \
           --ignore=tests/test_device_inter.py \
           --ignore=tests/test_device_encode.py \
           --ignore=tests/test_hevc_device.py \
           --ignore=tests/test_hevc_device_inter.py \
           --ignore=tests/test_hevc_cuqp.py \
           --ignore=tests/test_framepp.py \
           --ignore=tests/test_hevc_native.py \
           --ignore=tests/test_session.py \
           --ignore=tests/test_parallel.py \
           --ignore=tests/test_spatial.py \
           --ignore=tests/test_pallas_idct.py
# H.264 device kernels
run tests/test_device_recon.py tests/test_device_inter.py \
    tests/test_pallas_idct.py
# device encoder
run tests/test_device_encode.py
# HEVC device kernel: ONE wavefront-geometry compile per process (this
# jaxlib's CPU compiler segfaults once a process holds two of these
# multi-GB executables)
run tests/test_hevc_device.py -k "not wpp and not sweep and not partial"
run tests/test_hevc_device.py -k "wpp or sweep"
run tests/test_hevc_device.py -k "partial"
run tests/test_hevc_device_inter.py
run tests/test_hevc_cuqp.py
run tests/test_hevc_batch_split.py
run tests/test_framepp.py
run tests/test_hevc_native.py
run tests/test_session.py
# sharded multi-device paths
run tests/test_parallel.py
run tests/test_spatial.py
exit $FAILED
