#!/bin/bash
# Run the test suite on CPU WITHOUT claiming the TPU chip.
#
# The environment's sitecustomize registers the axon TPU PJRT plugin in
# every python process when PALLAS_AXON_POOL_IPS is set, which grabs the
# single TPU chip and blocks any concurrent TPU job.  Unsetting it keeps
# tests purely on CPU (tests/conftest.py also forces the cpu platform
# and an 8-device virtual mesh).
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu MANISDP_JAX_CACHE= \
    python -m pytest tests/ -q -m "not slow" "$@"
