package graft.recdb

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed facade over the recommendation surface — `Dataset[Event]` in,
  * `Dataset[Prediction]` / `Dataset[ItemSimilarity]` out, for callers that
  * want compile-time schemas (SURVEY.md §1.1 "Dataset[Event]"). The engine
  * itself stays DataFrame-based (dynamic column binding is the RecDB
  * contract); these wrappers fix the canonical column names and add encoders.
  */
object TypedApi {

  /** The canonical events triple (README.md:76-80). */
  final case class Event(userid: Long, itemid: Long, rating: Double)

  final case class Prediction(userid: Long, itemid: Long, score: Double)

  final case class ItemSimilarity(item1: Long, item2: Long, similarity: Double)

  final case class UserSimilarity(user1: Long, user2: Long, similarity: Double)

  val cols: EventCols = EventCols("userid", "itemid", "rating")

  def itemCosine(events: Dataset[Event]): Dataset[ItemSimilarity] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[ItemSimilarity]
    Similarity.itemCosine(events.toDF(), cols).as[ItemSimilarity]
  }

  def itemPearson(events: Dataset[Event]): Dataset[ItemSimilarity] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[ItemSimilarity]
    Similarity.itemPearson(events.toDF(), cols).as[ItemSimilarity]
  }

  def userCosine(events: Dataset[Event]): Dataset[UserSimilarity] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[UserSimilarity]
    Similarity.userCosine(events.toDF(), cols).as[UserSimilarity]
  }

  def userPearson(events: Dataset[Event]): Dataset[UserSimilarity] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[UserSimilarity]
    Similarity.userPearson(events.toDF(), cols).as[UserSimilarity]
  }

  /** Full recommend dispatch with typed output. */
  def recommend(spark: SparkSession, events: Dataset[Event], eventsTag: String,
      method: String, catalog: Option[RecCatalog] = None,
      users: Option[Dataset[java.lang.Long]] = None): Dataset[Prediction] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[Prediction]
    val usersDf = users.map(_.toDF("userid"))
    Recommender.recommend(spark, events.toDF(), eventsTag, cols, method,
      catalog, usersDf).as[Prediction]
  }
}
