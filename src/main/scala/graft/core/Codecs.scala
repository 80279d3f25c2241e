package graft.core

import org.apache.spark.sql.{Encoder, Encoders}

/** Shared encoders for the typed pipeline stages. */
object Codecs {
  implicit val imageEventEncoder: Encoder[ImageEvent] = Encoders.product[ImageEvent]
}
