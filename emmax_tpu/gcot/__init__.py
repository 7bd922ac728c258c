"""GCOT dataset generation: trajectory segmentation, movement verbalization,
LLM plan annotation, dataset assembly."""
