"""Visualization/eval suite (matplotlib/ffmpeg rebuild of src/plotting.jl)."""
