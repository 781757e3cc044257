#!/usr/bin/env bash
# canonical training command (reference train.sh)
python tools/train.py --cfg configs/trainzju_valzju.yaml "$@"
