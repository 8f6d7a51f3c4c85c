# Workflow parity with the reference's makefile UX
# (aarch64/makefile:1-2 `OLD :=`/`NEW :=` + `make run`), mapped onto the
# runtime registry. Examples:
#
#   make run NEW=06_pallas_int8 OLD=01_xla_fp32
#   make run NEW=05_pallas_bf16 SWEEP="--pfirst 1024 --plast 4096 --pinc 1024"
#   make plot
#   make probes
#   make test
#   make bench
#   make native

#   make tune NEW=14_packed_alias_int8 P=4096
#   make ab A=14_packed_alias_int8 B=06v_xla_int8   (interleaved protocol)
#   make moe-bench
#   make figures / make figures-small   (regenerate the visual record)

OLD ?= 01_xla_fp32
NEW ?= 05_pallas_bf16
A ?= 14_packed_alias_int8
B ?= 06v_xla_int8
SWEEP ?= --quick
OUT ?= outputs
P ?= 4096

run:
	python -u -m how_to_optimize_gemm_tpu.harness.driver \
	  --new $(NEW) --old $(OLD) --output-dir $(OUT) $(SWEEP)

plot:
	python -m how_to_optimize_gemm_tpu.viz.plot \
	  $(OUT)/output_old.m $(OUT)/output_new.m \
	  --roofline bf16 --save figures/compare.png

probes:
	python -c "from how_to_optimize_gemm_tpu.ops import probes; probes.main()"

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

native:
	$(MAKE) -C csrc

tune:
	python -u -m how_to_optimize_gemm_tpu.harness.autotune \
	  --rung $(NEW) --p $(P)

ab:
	python -u -m how_to_optimize_gemm_tpu.harness.ab --a $(A) --b $(B)

moe-bench:
	python -u -m how_to_optimize_gemm_tpu.parallel.moe_bench

figures:
	python -m how_to_optimize_gemm_tpu.viz.transitions

figures-small:
	python -m how_to_optimize_gemm_tpu.viz.transitions --small

.PHONY: run plot probes test bench native tune ab moe-bench figures \
	figures-small
