"""Rendering: camera, oracle tracer, TPU tracer, shading."""
