"""Text/linguistic layer: tokenizer, lexicons, numeric kernels, document featurizer."""
