#!/usr/bin/env bash
# canonical evaluation command (reference test.sh): FrameSampler over the
# test sequences with the optimized progressive renderer
python tools/inference.py --cfg configs/trainzju_valzju.yaml \
    render.file 'demo_render' \
    render.resume_path "${1:?usage: test.sh <checkpoint.pth>}" \
    dataset.test.sampler 'FrameSampler' \
    dataset.test.shuffle False \
    test.is_vis True
