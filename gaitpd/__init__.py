"""gaitpd — TPU-native framework for multimodal gait-based Parkinson's
disease assessment (JAX / XLA / Pallas / pjit).

Brand-new implementation with the capabilities of the PyTorch reference
"Towards Relaxed Multimodal Inputs for Gait-based Parkinson's Disease
Assessment" (see SURVEY.md / PARITY.md for the full component map).

Public API highlights:
    gaitpd.cli                — training CLI (python -m gaitpd.cli)
    gaitpd.sweep              — grid sweep runner
    gaitpd.serve.WearGaitEngine — relaxed-input inference engine
    gaitpd.models             — encoders, multitask, fusion, baselines
    gaitpd.learning.mtl       — 17 in-graph multitask weighting methods
    gaitpd.data               — readers, preprocessors, pipeline, samplers
"""

__version__ = "0.1.0"
