"""DataFrame operators: exact dedup, LSH candidate generation, similarity
verification, connected components, keeper selection, containment, reports."""
