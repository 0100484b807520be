from . import convnext, dvae, embed, gfsq, llama, speaker, tokenizer, vocos

__all__ = ["convnext", "dvae", "embed", "gfsq", "llama", "speaker",
           "tokenizer", "vocos"]
