#!/bin/bash
# Run the test suite on a virtual 8-device CPU mesh.
#
# PYTHONPATH= and PALLAS_AXON_POOL_IPS= disable the axon sitecustomize that
# pre-imports jax and registers the (single-client) TPU-tunnel PJRT plugin —
# without this, any concurrently running TPU job deadlocks the tests on the
# tunnel socket.
cd "$(dirname "$0")"
# build the native host runtime (C++ prefetch loader) so its tests run
if [ ! -f native/build/libhslam_loader.so ] || [ native/loader.cpp -nt native/build/libhslam_loader.so ]; then
    bash native/build.sh || echo "WARNING: native build failed; loader tests will skip"
fi
exec env PYTHONPATH= PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest tests/ "$@"
