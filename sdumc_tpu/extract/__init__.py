"""Offline feature-extraction stages (the reference's L1 layer), rebuilt as
jit-compiled batched graphs:

* audio.py   — raw wav -> WavLM/HuBERT-family layer-tap features
               (extract_transformers_embedding.py equivalent)
* text.py    — transcripts -> LLM hidden-state embeddings
               (extract_text_embedding_huggingface.py equivalent)
* llm4wav.py — WavLM features -> projector -> Vicuna generate -> feat4
               pseudo-text stream + the gt-text single-forward variant
               (extract_wavlm_vicuna{,_hd}.py equivalents)
* projector.py — the frozen WavLM->LLM bridge MLP
* visual.py  — face crops -> MANet embeddings (extract_manet_embedding.py)
"""
