from autorag_research_tpu.serving.server import ServingHandle, serve_workspace

__all__ = ["ServingHandle", "serve_workspace"]
