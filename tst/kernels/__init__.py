"""Pallas TPU kernels (SURVEY.md §2b B12). XLA fallbacks live in the model
core; these kernels are flag-switchable (`model.use_pallas`)."""
