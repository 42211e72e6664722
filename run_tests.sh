#!/bin/bash
# Run the test suite on a virtual 8-device CPU mesh.
#
# Default lane skips tests marked @slow (target: green in <15 min on an
# 8-core host). `./run_tests.sh --full` runs everything. Any other args
# are passed through to pytest.
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

LANE=(-m "not slow")
if [ "$1" = "--full" ]; then
    LANE=()
    shift
fi

# default to the whole suite only when the caller gave no paths
TARGET=(tests/)
for a in "$@"; do
    case "$a" in
        -*) ;;
        *) TARGET=(); break;;
    esac
done

# no persistent compile cache for tests: XLA:CPU AOT cache entries never
# reload cleanly (host-feature mismatch) and concurrent writes have
# segfaulted CI before (jax's put_executable_and_time)
env PYTHONPATH= PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    HSLAM_JAX_CACHE=0 \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest "${TARGET[@]}" "${LANE[@]}" "$@"
exit $?
