# tod_tpu developer entry points.
#
# CPU-only runs MUST disable the axon TPU-tunnel PJRT registration
# (PALLAS_AXON_POOL_IPS=) or interpreter startup can stall for minutes while
# the tunnel is busy.  Only bench/TPU targets keep the tunnel enabled.

CPU_ENV := PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
MESH_ENV := $(CPU_ENV) XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: test native bench bench-all dryrun train clean

test:
	$(CPU_ENV) python -m pytest tests/ -x -q

native:
	python tod_tpu/native/build.py

bench:
	python bench.py

bench-all:  # all benchmark configs (BASELINE 1-5 + VGA + batch MFU)
	python -m tod_tpu.bench --all

dryrun:
	$(MESH_ENV) python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

train:
	$(CPU_ENV) python -m tod_tpu.train.run --steps 200

clean:
	rm -f tod_tpu/native/libtodtpu.so
	find . -name __pycache__ -type d -exec rm -rf {} +
