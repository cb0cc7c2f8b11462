"""Model layer: Node2Vec (walks + SGNS) and text embedding backends."""
