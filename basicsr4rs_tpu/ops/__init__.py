"""TPU-native replacements for the reference's hand-written CUDA ops and
hot pipelines (reference: basicsr/ops/*, SURVEY.md §2.6)."""
