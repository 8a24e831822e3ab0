from dmfusion.report.excel import Workbook, expo_result  # noqa: F401
