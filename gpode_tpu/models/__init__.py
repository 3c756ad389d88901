"""Probabilistic model layer: SVGP vector fields, state posteriors, likelihoods, ELBOs."""
