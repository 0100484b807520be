from .generate import GenerateRequest, GenerationOutputs, Generator, Interrupt

__all__ = ["GenerateRequest", "GenerationOutputs", "Generator", "Interrupt"]
