CALL refresh_reports()
