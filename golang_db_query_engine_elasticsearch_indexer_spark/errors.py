"""Typed engine errors mirroring the reference's error_handler.

Reference: api/error_handler/error_handler.go:18-39 defines three typed
errors mapped to HTTP codes by the controllers
(query_controller.go:61-93): unauthorized operation -> 401, null
params -> 400, incorrect db driver -> 400. We add SqlSyntaxError (the
reference reuses a generic 400 for parse failures,
query_controller.go:86-91).
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class; carries the HTTP status the API layer should emit."""

    http_status = 500

    def envelope(self) -> dict:
        """Error envelope shape parity: responses.go:17-27 emits {"error": msg}."""
        return {"error": str(self)}


class UnauthorizedOperationError(EngineError):
    """Non-SELECT statement submitted to the query gateway.

    Reference: error_handler.go:18-23 ("Provided query operation is not
    authorized") -> 401 at query_controller.go:81-85. Unlike the
    reference's bypassable regex gate (SURVEY.md Q1), we check the
    parsed logical plan's node type.
    """

    http_status = 401

    def __init__(self, msg: str = "Provided query operation is not authorized"):
        super().__init__(msg)


class ParamsNullError(EngineError):
    """Required request parameter is empty.

    Reference: error_handler.go:25-31 -> 400 at query_controller.go:70-76.
    """

    http_status = 400

    def __init__(self, msg: str = "Provided parameters can not be null"):
        super().__init__(msg)


class IncorrectDbDriverError(EngineError):
    """Unknown source backend name.

    Reference: error_handler.go:33-39 -> 400 at query_controller.go:61-67;
    the allowlist is dbDriverValidator (query_controller.go:46-51).
    """

    http_status = 400

    def __init__(self, msg: str = "Incorrect database driver provided"):
        super().__init__(msg)


class SqlSyntaxError(EngineError):
    """SQL failed to parse.

    Reference: queryValidator (query_controller.go:26-35) -> 400.
    """

    http_status = 400


class NotFoundError(EngineError):
    """Named resource (index, point-in-time snapshot) does not exist.

    ES returns 404 for a missing index and for a missing/expired
    point-in-time; the reference has no analogue (its gateway never
    addresses resources by name beyond the MySQL table inside SQL).
    """

    http_status = 404


class RowLimitExceededError(EngineError):
    """Collect guard tripped: result too large to materialize on the driver.

    No reference analogue (the reference buffers the entire result in
    RAM, elastic_controller.go:118 — the failure mode we refuse to
    replicate at 100 TB; SURVEY.md §7 'hard parts' #5).
    """

    http_status = 400
