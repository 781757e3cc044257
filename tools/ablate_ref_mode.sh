#!/bin/bash
# Ref-mode quality-inversion ablation (VERDICT r3 #3): walk the flag ladder
# from the fast defaults to reference-cull semantics, one flag at a time,
# on the FULL synthetic test set (tools/quality_sweep.py protocol). The
# summary JSON line of each run is appended to artifacts/ablate_r4.jsonl.
set -u
OUT=artifacts/ablate_r4.jsonl
: > "$OUT"
run() {
  name="$1"; shift
  echo "== $name: $*" >&2
  line=$(timeout 2400 python -u tools/quality_sweep.py "$@" 2>/dev/null | tail -1)
  echo "{\"ablation\": \"$name\", \"result\": $line}" >> "$OUT"
  echo "$line" >&2
}
run fast_defaults
run lowres_src_off tpu.merge_lowres_src False
run k64_dropfree tpu.samples_per_ray 64 tpu.sigma_cap 2621440
run blanket_cull tpu.tight_cull False tpu.tap_window 0 tpu.splat_bins False \
    tpu.samples_per_ray 64 tpu.ray_cap 65536 tpu.sigma_cap 2621440 \
    tpu.rgb_cap 1048576
run full_ref_mode tpu.tight_cull False tpu.tap_window 0 tpu.splat_bins False \
    tpu.samples_per_ray 64 tpu.ray_cap 65536 tpu.sigma_cap 2621440 \
    tpu.rgb_cap 1048576 tpu.merge_lowres_src False
