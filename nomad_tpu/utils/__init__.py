from .metrics import correlation_report, fit_order_three, order_three, pcc, srcc

__all__ = ["correlation_report", "fit_order_three", "order_three", "pcc", "srcc"]
