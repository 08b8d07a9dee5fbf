"""The reference's ~14 entry points as thin TrainConfig instances over
the shared engine (SURVEY.md section 7 'guiding translation'). Run as
``python -m cartseg_tpu.workloads.<name> [--field value ...]``."""
