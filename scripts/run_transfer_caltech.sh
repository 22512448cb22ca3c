#!/bin/bash
# Caltech-101 transfer (README.md:96): bs256, lr 1e-5, wd 0.0, 100 epochs, warmup 500.
set -e
python -m flyp_tpu.cli.main \
  --train-dataset=Caltech101Val --template=caltech101_template \
  --eval-datasets=Caltech101Val,Caltech101Test \
  --model='ViT-B/16' --ft_data=datasets/csv/caltech101.csv \
  --data-location=datasets/data \
  --batch-size=256 --lr=1e-5 --wd=0.0 --epochs=100 --warmup_length=500 \
  --exp_name=flyp_caltech101 --save=checkpoints/ "$@"
