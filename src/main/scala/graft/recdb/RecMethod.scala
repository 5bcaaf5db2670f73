package graft.recdb

/** The five recommendation methods (recathon.h:23-29). Parsing is
  * case-insensitive via lowercase compare (recathon.c:889-905) and the
  * default method is itemCosCF (recathon.c:868-871) — SURVEY.md §2.3 #9.
  */
sealed abstract class RecMethod(val name: String)

object RecMethod {
  case object ItemCosCF extends RecMethod("itemcoscf")
  case object ItemPearCF extends RecMethod("itempearcf")
  case object UserCosCF extends RecMethod("usercoscf")
  case object UserPearCF extends RecMethod("userpearcf")
  case object SVD extends RecMethod("svd")

  val all: Seq[RecMethod] = Seq(ItemCosCF, ItemPearCF, UserCosCF, UserPearCF, SVD)

  val default: RecMethod = ItemCosCF

  def parse(s: String): RecMethod = {
    if (s == null || s.isEmpty) return default
    all.find(_.name == s.toLowerCase)
      .getOrElse(throw new IllegalArgumentException(
        s"unknown recommendation method: $s (recathon.c:905 'invalid method')"))
  }

  def isUserBased(m: RecMethod): Boolean = m == UserCosCF || m == UserPearCF
}
