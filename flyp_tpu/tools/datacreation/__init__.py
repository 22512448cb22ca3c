"""Offline dataset-preparation tools (`/root/reference/datacreation_scripts/`).

Each module is a CLI (`python -m flyp_tpu.tools.datacreation.<name>`) that
emits the tab-separated contrastive CSVs the training pipeline consumes
(``title\tfilepath[\tlabel\tguidance\timg_id]``) or reorganizes raw
releases into the ImageFolder trees the dataset registry expects.  Unlike
the upstream scripts, paths are arguments, not hardcoded author
directories.
"""
