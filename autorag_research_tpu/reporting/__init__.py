from autorag_research_tpu.reporting.service import ReportingService

__all__ = ["ReportingService"]
