from .batching import Engine, EngineConfig, EngineOutput, EngineRequest
from .generate import GenerateRequest, GenerationOutputs, Generator, Interrupt
from .streaming import StreamingDecoder, plan_windows

__all__ = ["Engine", "EngineConfig", "EngineOutput", "EngineRequest",
           "GenerateRequest", "GenerationOutputs", "Generator", "Interrupt",
           "StreamingDecoder", "plan_windows"]
