"""Text utilities: string similarity, id interning, tokenization."""
