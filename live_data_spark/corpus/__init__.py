"""LLM-training-corpus pipeline built on the engine's model registry."""
