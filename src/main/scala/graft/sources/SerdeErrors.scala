package graft.sources

/** Typed serde error taxonomy ≙ reference avro/AvroConverter.java:630-695
  * (IllegalRow / IllegalRowConvertion / IllegalCellConversion) with the
  * 250-char data-echo discipline (trimExceptionMessage, :619-627): cell
  * failures name the field, row failures echo the row, and no error ever
  * drags an unbounded value into its message.
  *
  * Scope note: these are thrown from the JVM-side decoders (Avro records,
  * protobuf wire, bad blocks). The Coerce cast path stays inside Catalyst
  * codegen by design, so its strict-mode failures surface as Spark's own
  * CAST_INVALID_INPUT errors — typed wrapping there would force every cell
  * through a UDF boundary.
  */
object SerdeErrors {

  /** bounded data echo for error messages */
  def trim250(v: Any): String = {
    val s = String.valueOf(v)
    if (s.length <= 250) s else s.take(250) + "…"
  }

  /** a single cell/field failed to convert or validate */
  final class IllegalCellException(
      val field: String, val data: Any, cause: Throwable = null)
      extends RuntimeException(
        s"illegal cell on field '$field' with data [${trim250(data)}]", cause)

  /** a whole row/record failed to decode or validate */
  final class IllegalRowException(val data: Any, cause: Throwable = null)
      extends RuntimeException(
        s"illegal row with data [${trim250(data)}]", cause)
}
