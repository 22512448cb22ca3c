from .bpe import ClipTokenizer, get_tokenizer, tokenize

__all__ = ["ClipTokenizer", "get_tokenizer", "tokenize"]
