"""Entity-resolution layer (SURVEY.md §2.4 R1-R12).

The reference delegates cross-document resolution to the Rosette
kb-linker (``entities_response.json:324`` ``"source":"kb-linker"``);
this package builds it natively: blocking → candidate pairs →
vectorized scoring → threshold → iterative hash-min connected
components → stable cluster IDs, evaluated by pairwise F1 per
blocking key.
"""
