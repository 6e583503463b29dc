# Developer conveniences (the reference wraps catkin/cmake; here: pytest,
# bench, and the native library build).

.PHONY: all test test-tpu bench bench-quick native clean

all: native

native:
	python -c "from nautilus_tpu.ingest.native import get_lib; \
	           print('native bag reader:', 'ok' if get_lib() else 'unavailable')"

test:
	python -m pytest tests/ -q

# On-device parity lane (tests/test_tpu_parity.py): needs a real TPU.
test-tpu:
	NAUTILUS_TPU_TESTS=1 python -m pytest tests -m tpu -q

bench:
	python bench.py

bench-quick:
	python bench.py --quick

clean:
	rm -f nautilus_tpu/native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
