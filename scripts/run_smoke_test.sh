#!/bin/bash
# Smoke config (myshells/run_normaltest.sh): 2 epochs, bs64, --debug --test
# exercises data + eval plumbing without training.
set -e
python -m flyp_tpu.cli.main \
  --train-dataset=ImageNet --template=openai_imagenet_template \
  --eval-datasets=ImageNet --model='ViT-B/16' \
  --ft_data=datasets/csv/imagenet.csv --data-location=datasets/data \
  --batch-size=64 --epochs=2 --debug --test --exp_name=smoke "$@"
