from . import audio, checkpoint, dl, io, llm, logger, native, normalizers, profiling, seeder

__all__ = ["audio", "checkpoint", "dl", "io", "llm", "logger", "native",
           "normalizers", "profiling", "seeder"]
